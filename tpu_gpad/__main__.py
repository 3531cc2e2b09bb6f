import sys

from tpu_gpad.cli import main

sys.exit(main())
