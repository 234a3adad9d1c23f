"""`python -m dynseg` — the reference's `python dynamic.py` entry
(SURVEY.md L5/C1)."""

import sys

from dynseg.cli import main

if __name__ == "__main__":
    sys.exit(main())
