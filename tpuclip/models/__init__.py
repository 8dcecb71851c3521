from tpuclip.models.configs import (  # noqa: F401
    SiglipConfig,
    TextConfig,
    VisionConfig,
    PRESETS,
    get_config,
)
from tpuclip.models.siglip import (  # noqa: F401
    init_params,
    vision_forward,
    text_forward,
    get_image_features,
    get_text_features,
)
