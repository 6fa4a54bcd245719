.PHONY: native test bench clean

native: pyisingmontecarlo_tpu/_graphc.so

pyisingmontecarlo_tpu/_graphc.so: native/graphc.cpp
	g++ -O3 -march=native -shared -fPIC -o $@ $<

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f pyisingmontecarlo_tpu/_graphc.so
