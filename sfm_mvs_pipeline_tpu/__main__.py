import sys

from sfm_mvs_pipeline_tpu.cli.app import main

if __name__ == "__main__":
    sys.exit(main())
