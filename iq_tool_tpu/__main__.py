import sys

from iq_tool_tpu.cli import main

sys.exit(main())
