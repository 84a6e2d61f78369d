#!/usr/bin/env python
"""Top-level training entry point (reference-compatible CLI surface).

Mirrors the reference's top-level failure handling (train.py:297-304):
exceptions are logged (with traceback) rather than crashing the
process, so long runs always leave a readable record.
"""
import logging

from vocal_remover_tpu.cli.train import main

if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        logging.getLogger("vocal_remover_tpu.cli.train").exception(e)
