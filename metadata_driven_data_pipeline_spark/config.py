"""YAML/JSON config loading with environment-variable substitution.

Parity: ``pipeline/config_loader.py:11-23`` loads YAML and applies
``os.path.expandvars`` so ``${VAR}`` references resolve from the
environment; accessors are plain dict lookups.
"""

from __future__ import annotations

import json
import os
from typing import Any


def load_config(path: str) -> dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        raw = f.read()
    substituted = os.path.expandvars(raw)
    if path.endswith((".yaml", ".yml")):
        import yaml  # lazy: PyYAML ships with pyspark deps

        return yaml.safe_load(substituted)
    return json.loads(substituted)


def load_metadata(path: str) -> dict[str, Any]:
    """Metadata documents are JSON (parity: runner.py:142-143)."""
    with open(path, encoding="utf-8") as f:
        raw = f.read()
    return json.loads(os.path.expandvars(raw))
