.PHONY: test test-fast bench lint native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

lint:
	python -m compileall -q bikg_graph_explainability_public_tpu
	python -c "import bikg_graph_explainability_public_tpu"
	python scripts/lint.py

native:
	g++ -O3 -march=native -shared -fPIC \
	  bikg_graph_explainability_public_tpu/runtime/graph_builder.cpp \
	  -o bikg_graph_explainability_public_tpu/runtime/_graph_builder.so

clean:
	rm -rf bikg_graph_explainability_public_tpu/runtime/_graph_builder.so \
	  .pytest_cache $(shell find . -name __pycache__ -type d)
