# `make check` = lint + types + tests (reference analogue: pre-commit with
# flake8/black/isort/mypy, /root/reference/setup.cfg:10-19). ruff/mypy run
# when installed; tools/lint.py is the dependency-free fallback that always
# runs.
.PHONY: check lint type test native-test

check: lint type test

# ASAN+UBSAN build of the C++ kernels with a standalone test harness
# (SURVEY.md §5.2). OpenMP is disabled under the sanitizers to keep the
# report signal clean; the OpenMP build is exercised by tests/test_native.py.
native-test:
	g++ -std=c++17 -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
	  fastspeech2_lightning_tpu/native/kernels.cpp \
	  fastspeech2_lightning_tpu/native/test_kernels_main.cpp \
	  -o /tmp/fs2t_native_test && /tmp/fs2t_native_test

lint:
	python tools/lint.py
	@command -v ruff >/dev/null 2>&1 && ruff check . || echo "ruff not installed (skipped)"

type:
	@command -v mypy >/dev/null 2>&1 && mypy fastspeech2_lightning_tpu || echo "mypy not installed (skipped)"

test:
	python -m pytest tests/ -x -q
