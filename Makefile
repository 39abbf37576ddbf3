# `make check` = lint + types + tests (reference analogue: pre-commit with
# flake8/black/isort/mypy, /root/reference/setup.cfg:10-19). ruff/mypy run
# when installed; tools/lint.py is the dependency-free fallback that always
# runs.
.PHONY: check lint type test

check: lint type test

lint:
	python tools/lint.py
	@command -v ruff >/dev/null 2>&1 && ruff check . || echo "ruff not installed (skipped)"

type:
	@command -v mypy >/dev/null 2>&1 && mypy fastspeech2_lightning_tpu || echo "mypy not installed (skipped)"

test:
	python -m pytest tests/ -x -q
