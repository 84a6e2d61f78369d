#!/usr/bin/env python
"""Top-level pseudo-labeling entry point (reference-compatible CLI surface)."""
from vocal_remover_tpu.cli.pseudo import main

if __name__ == "__main__":
    main()
