"""``python -m mdmpublic_ray`` → operational CLI (see cli.py)."""

import sys

from .cli import main

sys.exit(main())
