"""``python -m pybel_spark`` → the CLI (cli.py)."""
import sys

from .cli import main

sys.exit(main())
