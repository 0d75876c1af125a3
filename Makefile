# Convenience targets (see CLAUDE.md for the environment rules)

.PHONY: test test-slow slowcheck bench native selfcheck selfcheck-full dryrun

test:
	./run_tests.sh

test-slow:
	env PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q -m slow

slowcheck:  # slow suite (accuracy gates: unpinned selfcheck, AR no-degradation,
	# 2-process train) with a committed result artifact for the round record.
	# The pytest exit code is preserved: a failed gate fails the target.
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		python -m pytest tests/ -m slow -q --junitxml=artifacts/slowcheck.xml \
		> /tmp/slowcheck.out 2>&1; rc=$$?; \
	tail -5 /tmp/slowcheck.out; \
	python -c "import json, time, pathlib; \
	out = pathlib.Path('/tmp/slowcheck.out').read_text(); \
	lines = [l for l in out.splitlines() if 'passed' in l or 'failed' in l]; \
	line = lines[-1].strip() if lines else '<no pytest summary: crashed>'; \
	rec = {'ts': time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime()), 'rc': $$rc, 'summary': line}; \
	p = pathlib.Path('artifacts/slowcheck.jsonl'); p.parent.mkdir(exist_ok=True); \
	f = p.open('a'); f.write(json.dumps(rec) + chr(10)); f.close(); \
	print('recorded:', rec)"; \
	exit $$rc

native:
	$(MAKE) -C native

bench:  # TPU: must be the only live jax process
	python bench.py

selfcheck:
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		python -m gigapose_tpu.scripts.selfcheck_e2e

selfcheck-full:
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		python -m gigapose_tpu.scripts.selfcheck_full steps=900 level=1

dryrun:
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

parity:  # real-data parity runbook (downloads weights/data; see parity.py)
	python -m gigapose_tpu.scripts.parity mode=real root_dir=$(ROOT) dataset=$(DS)

parity-dryrun:  # same chain on the synthetic fixture (runs on this box)
	env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
		python -m gigapose_tpu.scripts.parity mode=dryrun
