# cmr-landmark-tpu — development targets (the reference's cookiecutter
# Makefile analogue, ref: Makefile:1-60, with a working test target).

PY ?= python
DATA_ROOT ?= data
ACDC ?= $(DATA_ROOT)/original
CFG ?= exp/template_cfgs/example_config.json
EXP ?=

.PHONY: test test-fast bench dataset train predict evaluate dryrun lint clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

dataset:
	$(PY) -m cmrtpu.cli.make_dataset -data_root $(DATA_ROOT) -acdc_data $(ACDC)

train:
	$(PY) -m cmrtpu.cli.train -cfg $(CFG) -data $(DATA_ROOT)

predict:
	$(PY) -m cmrtpu.cli.predict -exp $(EXP) -data $(DATA_ROOT)

predict-4d:
	$(PY) -m cmrtpu.cli.predict_4d -exp $(EXP) -data $(DATA_ROOT)

evaluate:
	$(PY) -m cmrtpu.cli.evaluate_cv -exp $(EXP) -data $(DATA_ROOT)

dryrun:
	$(PY) __graft_entry__.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -rf .pytest_cache
