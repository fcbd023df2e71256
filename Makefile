# mirrors the reference Makefile targets (install / test / benchmark* / train)

install:
	# --no-build-isolation: works offline (pip's isolated build env would
	# try to fetch setuptools from PyPI even though it is installed)
	pip install -e . --no-build-isolation

test:
	python -m pytest tests/ -x -q

native:
	mkdir -p native/build
	g++ -O2 -shared -fPIC native/dataloader.cc -o native/build/libfcsa_data.so -lz

benchmark:
	python benchmark.py

benchmark_causal:
	python benchmark.py --causal

benchmark_forwards:
	python benchmark.py --only-forwards

benchmark_backwards:
	python benchmark.py --only-backwards

benchmark_masked:
	python benchmark.py --mask-prob 0.25

benchmark_decode:
	PYTHONPATH=.:$$PYTHONPATH python tools/bench_decode.py

benchmark_scaling:
	python tools/bench_scaling.py

benchmark_bias:
	python tools/bench_bias.py

benchmark_bwd:
	python tools/bench_bwd.py

benchmark_int8qk:
	python tools/bench_int8qk.py

benchmark_serving:
	python tools/bench_serving.py

benchmark_sweep:
	python tools/bench_sweep.py

bench:
	python bench.py

train:
	python train.py

clean:
	rm -rf native/build dist build *.egg-info
	find . -name __pycache__ -type d -exec rm -rf {} +

.PHONY: install test native benchmark benchmark_causal benchmark_forwards \
        benchmark_backwards benchmark_masked benchmark_decode \
        benchmark_scaling benchmark_serving benchmark_sweep \
        benchmark_bias benchmark_bwd benchmark_int8qk bench train \
        clean
