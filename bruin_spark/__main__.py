import sys

from bruin_spark.cli import main

sys.exit(main())
