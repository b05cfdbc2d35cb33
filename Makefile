# cmrtpu workflow targets — the working equivalent of the reference's
# cookiecutter Makefile (ref: Makefile:1-59, whose requirement/test targets
# reference files that do not exist). Variables:
#   DATA  — data root (original/ + 2D/ + df_kfold.csv), default ./data
#   CFG   — experiment config json, default exp/template_cfgs/example_config.json
#   EXP   — experiment / run directory (predict + evaluate + resume targets)

.PHONY: test test-fast dataset train resume predict predict-4d evaluate \
	bench dryrun demo demo-cine notebooks clean

PYTHON ?= python
DATA   ?= data
CFG    ?= exp/template_cfgs/example_config.json
EXP    ?=

## Run the full test suite (CPU, virtual 8-device mesh via tests/conftest.py)
test:
	$(PYTHON) -m pytest tests/ -q

## Fail-fast suite for quick iteration
test-fast:
	$(PYTHON) -m pytest tests/ -x -q

## Slice 3D ACDC volumes + RVIP masks into the 2D training layout
dataset:
	$(PYTHON) -m cmrtpu.cli.make_dataset -data_root $(DATA) -acdc_data $(DATA)/original

## Train the configured folds (chained per-fold inference included)
train:
	$(PYTHON) -m cmrtpu.cli.train -cfg $(CFG) -data $(DATA)

## Resume a crashed/preempted run: make resume EXP=exp/<EXP>/<ts>
resume:
	$(PYTHON) -m cmrtpu.cli.train -cfg $(CFG) -data $(DATA) -resume $(EXP)

## Re-run inference for one fold dir: make predict EXP=exp/<EXP>/<ts>/f0
predict:
	$(PYTHON) -m cmrtpu.cli.predict -exp $(EXP) -data $(DATA)

## Run the 4D (cine) inference driver over a finished CV: make predict-4d EXP=...
predict-4d:
	$(PYTHON) -m cmrtpu.cli.predict_4d -exp $(EXP) -data $(DATA)

## Build df_eval.csv over a finished CV: make evaluate EXP=exp/<EXP>/<ts>
evaluate:
	$(PYTHON) -m cmrtpu.cli.evaluate_cv -exp $(EXP) -data $(DATA)

## Export a fold's forward pass for serving: make export EXP=exp/<EXP>/<ts>/f0 OUT=artifact
export:
	$(PYTHON) -m cmrtpu.cli.export -exp $(EXP) -out $(OUT)

## Restore-once batch serving over a study directory:
##   make serve ARTIFACT=artifact IN=incoming OUT_DIR=served
serve:
	$(PYTHON) -m cmrtpu.cli.serve -artifact $(ARTIFACT) -in $(IN) -out $(OUT_DIR) \
		--stats $(OUT_DIR)/serving_stats.jsonl

## One-line JSON throughput benchmark (slices/sec on the available devices)
bench:
	$(PYTHON) bench.py

## Compile-check the flagship step + the 8-device sharded micro-workflow
dryrun:
	$(PYTHON) __graft_entry__.py

## Synthetic end-to-end CV demo (dataset -> train -> predict -> evaluate)
demo:
	$(PYTHON) examples/full_cv_demo.py --root /tmp/cmrtpu_demo --patients 8 \
		--epochs 10 --dim 64 --folds 0

## Cine (2D+t) quality loop: held-out per-frame mm localisation
demo-cine:
	$(PYTHON) examples/cine_quality_demo.py --patients 12 --epochs 600

## Execute the 8 guided notebooks end-to-end (CPU, self-contained data)
notebooks:
	$(PYTHON) tools/run_notebooks.py

## Delete compiled Python artifacts (parity with the reference's clean)
clean:
	find . -type f -name "*.py[co]" -delete
	find . -type d -name "__pycache__" -exec rm -rf {} +
