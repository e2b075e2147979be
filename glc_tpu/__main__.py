"""Allow `python -m glc_tpu <args>` as the `glc` binary."""

import sys

from .cli import main

sys.exit(main())
