#!/bin/sh
# Core test tier: everything except the model-compile tests (-m slow).
# Target: <10 min cold on a single-core CPU host. Full tier: pytest tests/
exec python -m pytest tests/ -q -m "not slow" "$@"
