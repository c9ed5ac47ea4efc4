"""``python -m dbtwiz_spark`` → the engine CLI (cli.py)."""

import sys

from dbtwiz_spark.cli import main

sys.exit(main())
