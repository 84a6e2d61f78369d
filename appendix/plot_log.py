#!/usr/bin/env python
"""Loss-curve plotting (reference-compatible location)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vocal_remover_tpu.cli.plot_log import main

if __name__ == "__main__":
    main()
