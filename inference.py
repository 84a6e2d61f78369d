#!/usr/bin/env python
"""Top-level inference entry point (reference-compatible CLI surface)."""
from vocal_remover_tpu.cli.inference import main

if __name__ == "__main__":
    main()
