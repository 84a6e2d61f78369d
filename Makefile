# Convenience entry points. The framework itself is pure `pip`-less
# Python + a setuptools C extension built on demand (native/build.py).

.PHONY: test bench parity native

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	python -c "from vocal_remover_tpu.native import build; build.build()"

# One-command SDR/output parity vs a reference checkpoint, e.g.:
#   make parity CHECKPOINT=models/baseline.pth
# optionally MIXTURES=... INSTRUMENTS=... for the MUSDB18 SDR harness.
parity:
	python scripts/parity.py --checkpoint $(CHECKPOINT) \
		$(if $(MIXTURES),--mixtures $(MIXTURES)) \
		$(if $(INSTRUMENTS),--instruments $(INSTRUMENTS)) \
		$(if $(JSON),--json $(JSON))
