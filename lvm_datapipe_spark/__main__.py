from lvm_datapipe_spark.cli import main
import sys

sys.exit(main())
