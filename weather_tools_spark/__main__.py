"""``python -m weather_tools_spark`` → the CLI (cli.py)."""

import sys

from weather_tools_spark.cli import main

sys.exit(main())
