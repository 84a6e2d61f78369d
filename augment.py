#!/usr/bin/env python
"""Top-level augment entry point (reference-compatible CLI surface)."""
from vocal_remover_tpu.cli.augment import main

if __name__ == "__main__":
    main()
