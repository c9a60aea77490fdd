# Convenience targets. See README.md / CLAUDE.md.

.PHONY: test bench native train-demo quickstart clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C cpp

train-demo:
	python -m tinyrecurrentunet_tpu.train.loop -c config/synthetic16k.json \
		--synthetic --synthetic_items 4096 --max_iters 10000

quickstart:
	python examples/quickstart.py

clean:
	rm -rf ckpt exp logs .pytest_cache
	$(MAKE) -C cpp clean
