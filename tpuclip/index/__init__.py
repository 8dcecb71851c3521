from tpuclip.index.store import MetadataStore  # noqa: F401
from tpuclip.index.cache import MatrixCache  # noqa: F401
