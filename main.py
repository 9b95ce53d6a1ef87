"""Reference-flag-compatible entry point (see cli/main.py)."""

import sys

from semantic_pyramid_for_image_generation_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
