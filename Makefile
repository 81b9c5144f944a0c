# splade-tpu orchestration (reference counterpart: Makefile:101-330)

PYTHON ?= python
CONFIG ?= configs/train_v33.yaml
OUTPUT ?= outputs/train_v33
CHECKPOINT ?= $(OUTPUT)/final_model

.PHONY: help test test-fast test-snapshot train train-resume train-debug \
        benchmark-ko-strategyqa benchmark-miracl-ko benchmark-mrtydi-ko \
        benchmark-triplet-val bench bench-qps export-hf idf-tool osi-log-sender serve \
        preprocess profile clean

help:
	@grep -E '^[a-z-]+:' Makefile | sed 's/:.*//' | sort -u

# ------------------------------------------------------------------ tests
test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x -k "not parity and not trainer_end and not tiny_schema and not multihost"

# the pre-snapshot gate (VERDICT r3 #7): the FULL suite, multihost
# included, fails loud — run after the last substantive commit of a
# round; the round closure map records its result
test-snapshot:
	$(PYTHON) -m pytest tests/ -q
	@echo "test-snapshot: full suite green $$(date -u +%F-%T)"

# ------------------------------------------------------------------ training
train:
	$(PYTHON) -m splade_tpu.train v33 --config $(CONFIG)

train-resume:
	$(PYTHON) -m splade_tpu.train v33 --config $(CONFIG) --resume

train-debug:
	$(PYTHON) -m splade_tpu.train v33 --config $(CONFIG) --debug

train-v34-kd:
	$(PYTHON) -m splade_tpu.train v33 --config configs/train_v34_kd.yaml \
	    --checkpoint $(CHECKPOINT)

train-v34-multi-neg:
	$(PYTHON) -m splade_tpu.train v33 --config configs/train_v34_multi_neg.yaml \
	    --checkpoint $(CHECKPOINT)

# ------------------------------------------------------------------ benchmarks
benchmark-ko-strategyqa:
	$(PYTHON) -m splade_tpu.benchmark.runner --dataset ko-strategyqa \
	    --checkpoint $(CHECKPOINT)

benchmark-miracl-ko:
	$(PYTHON) -m splade_tpu.benchmark.runner --dataset miracl-ko \
	    --checkpoint $(CHECKPOINT)

benchmark-mrtydi-ko:
	$(PYTHON) -m splade_tpu.benchmark.runner --dataset mrtydi-ko \
	    --checkpoint $(CHECKPOINT)

benchmark-triplet-val:
	$(PYTHON) -m splade_tpu.benchmark.runner --dataset triplet-val \
	    --val-files "data/v29.0/val.jsonl" --checkpoint $(CHECKPOINT)

# Rehearse the real quality-parity run on fake flagship-shaped artifacts:
# port -> encode -> all three benchmark loaders -> BASELINE.md comparison
# table (stamped SYNTHETIC WEIGHTS). When the real checkpoint + datasets
# land, the same command with CHECKPOINT=... produces the 62.2/62.0/73.4
# comparison.
parity-rehearsal:
	$(PYTHON) scripts/parity_rehearsal.py $(if $(CHECKPOINT),--checkpoint $(CHECKPOINT),)

bench:
	$(PYTHON) bench.py

bench-qps:
	$(PYTHON) scripts/bench_qps.py

bench-train-variants:  # train-step throughput grid (VARIANTS=a,b to subset)
	$(PYTHON) scripts/bench_train_variants.py $(if $(VARIANTS),--only $(VARIANTS),)

bench-mlm-variants:  # MLM-step throughput grid
	$(PYTHON) scripts/bench_mlm_variants.py $(if $(VARIANTS),--only $(VARIANTS),)

splash-parity:  # splash-vs-sdpa numerics at full flagship size (TPU)
	$(PYTHON) scripts/verify_splash_parity.py

analyzer-sensitivity:  # BM25 analyzer experiment on the 1.2K-doc morphology fixture (CPU)
	JAX_PLATFORMS=cpu $(PYTHON) scripts/analyzer_sensitivity.py

dispatch-bracket:  # measure the colocated-dispatch term of the serving estimate (CPU)
	JAX_PLATFORMS=cpu $(PYTHON) scripts/measure_dispatch_overhead.py

pod-sim:  # full-flagship 22L/768/50K GSPMD step on the 8-virtual-device mesh (CPU)
	JAX_PLATFORMS=cpu $(PYTHON) scripts/pod_sim_full_size.py

lambda-completion:  # production-shape training run to steady-state sparsity (TPU)
	bash scripts/run_lambda_completion.sh

recall-1m:  # candidate-coverage recall + QPS on real encoder vectors (TPU)
	$(PYTHON) scripts/recall_encoder_1m.py $(RECALL_ARGS)

# ------------------------------------------------------------------ offline tier
preprocess:
	$(PYTHON) scripts/collect_korean_datasets.py --output-dir data/v29.0

export-hf:
	$(PYTHON) scripts/export_hf.py --checkpoint $(CHECKPOINT) \
	    --output huggingface/v33_tpu

idf-tool:
	$(MAKE) -C tools/idf_compute

osi-log-sender:
	$(MAKE) -C tools/osi_log_sender

profile:
	$(PYTHON) scripts/profile_train_step.py

serve:
	$(PYTHON) -m splade_tpu.serving.server --checkpoint $(CHECKPOINT) \
	    --docs $(DOCS) --port 8080

clean:
	rm -rf outputs/ .pytest_cache
	$(MAKE) -C tools/idf_compute clean
	$(MAKE) -C tools/osi_log_sender clean
