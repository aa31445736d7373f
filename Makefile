.PHONY: test test-fast bench bench-train native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-train:
	python bench_train.py

native:
	g++ -O2 -std=c++20 -shared -fPIC \
	  -o textreact_tpu/chem/libcchem.so.1 textreact_tpu/chem/_cchem.cpp
	g++ -O2 -std=c++20 -shared -fPIC \
	  -o textreact_tpu/tokenizers/libctok.so.1 textreact_tpu/tokenizers/_ctok.cpp

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +; \
	rm -f textreact_tpu/chem/libcchem.so.1
