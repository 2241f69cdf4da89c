# Native serialization plane build (also auto-built lazily by
# hydrium_tpu/jxl/native.py on first import).

CXX ?= g++
CXXFLAGS ?= -O2 -std=c++17 -fPIC -pthread

all: build/libhydtpu.so

build/libhydtpu.so: cpp/serializer.cc
	mkdir -p build
	$(CXX) $(CXXFLAGS) -shared $< -o $@

# Sanitizer build + standalone differential self-test (SURVEY.md §5:
# race/memory sanitizers for the native plane).
asan: cpp/serializer.cc cpp/selftest.cc
	mkdir -p build
	$(CXX) -O1 -g -std=c++17 -pthread -fsanitize=address,undefined \
	  -fno-sanitize-recover=all cpp/serializer.cc cpp/selftest.cc \
	  -o build/selftest_asan
	./build/selftest_asan

test:
	python -m pytest tests/ -x -q

# On-chip regression sweep (needs the real TPU; run at most one TPU
# client at a time -- see CLAUDE.md on the tunnel).  Covers the packed
# payload parity smoke (MXU bitpack / Pallas kernel / LF stream) and a
# budgeted end-to-end bench; each stage retries once in a fresh process
# because the tunnel can wedge a client forever.
tpu-check:
	timeout 420 python scripts/tpu_smoke.py \
	  || timeout 420 python scripts/tpu_smoke.py
	HYDRIUM_BENCH_BUDGET_S=900 timeout 960 python bench.py 2

clean:
	rm -rf build

.PHONY: all asan test clean tpu-check
