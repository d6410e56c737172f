"""`python -m asyrp_official_tpu` → the CLI (cli/main.py)."""
import sys

from asyrp_official_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
