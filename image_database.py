#!/usr/bin/env python3
"""Drop-in compatibility shim for droon/CLIP-database users.

The reference exposes everything through ``python image_database.py
scan|search ...``; tpuclip keeps that invocation working verbatim by
forwarding to the tpuclip CLI (same subcommands, flags, and interactive
mini-language).
"""

import sys

from tpuclip.cli import main
from tpuclip.utils.logging import log

if __name__ == "__main__":
    log("Script starting...")
    try:
        main()
    except Exception as e:  # noqa: BLE001
        log(f"Fatal error: {e}")
        import traceback

        traceback.print_exc()
        sys.exit(1)
