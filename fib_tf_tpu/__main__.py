import sys

from fib_tf_tpu.cli import main

sys.exit(main())
