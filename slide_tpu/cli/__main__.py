import sys

from slide_tpu.cli.main import main

sys.exit(main())
