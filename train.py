#!/usr/bin/env python
"""Top-level training entry point (reference-compatible CLI surface)."""
from vocal_remover_tpu.cli.train import main

if __name__ == "__main__":
    main()
