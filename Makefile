# Convenience targets. See README.md / CLAUDE.md.

.PHONY: test bench native train-demo quickstart clean \
	train-quality quality quality-artifact

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

# ---- quality story (VERDICT round-1 item #2): train on the procedural
# speech corpus, snapshot the weights as a standalone artifact, evaluate
# through the full denoise_directory -> evaluate_dns pipeline on the
# held-out DNS-layout testset, and write QUALITY.json.
train-quality:
	python -m tinyrecurrentunet_tpu.train.loop -c config/proc16k.json --procedural

quality-artifact:
	JAX_PLATFORMS=cpu python -m tinyrecurrentunet_tpu.train.export_pretrained \
		-c config/proc16k.json --out artifacts/TRUNet-proc
	JAX_PLATFORMS=cpu python -m tinyrecurrentunet_tpu.export.quantize \
		-c config/proc16k.json --pretrained artifacts/TRUNet-proc

quality:
	python -m tinyrecurrentunet_tpu.infer.quality -c config/proc16k.json \
		--pretrained artifacts/TRUNet-proc \
		--int8 artifacts/TRUNet-proc/model_int8.trq --out QUALITY.json

# ---- 48 kHz regime (the reference's native rate)
train-quality48:
	python -m tinyrecurrentunet_tpu.train.loop -c config/proc48k.json --procedural

quality-artifact48:
	JAX_PLATFORMS=cpu python -m tinyrecurrentunet_tpu.train.export_pretrained \
		-c config/proc48k.json --out artifacts/TRUNet-proc48
	JAX_PLATFORMS=cpu python -m tinyrecurrentunet_tpu.export.quantize \
		-c config/proc48k.json --pretrained artifacts/TRUNet-proc48

quality48:
	python -m tinyrecurrentunet_tpu.infer.quality -c config/proc48k.json \
		--pretrained artifacts/TRUNet-proc48 \
		--int8 artifacts/TRUNet-proc48/model_int8.trq --out QUALITY48.json

clean:
	rm -rf ckpt exp logs .pytest_cache
	$(MAKE) -C cpp clean
