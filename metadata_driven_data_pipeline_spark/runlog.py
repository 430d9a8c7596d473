"""Structured JSON run-logging.

Reference semantics (``utils/json_logger.py:24-140``): one JSON document per
``run_id`` with ``stages`` → ``sub_stages``, each carrying started_at/
completed_at timestamps, computed ``duration_seconds``, status, and free-form
metrics (records_loaded / ok_count / records_written ...). The reference
persists to MinIO; we persist to any local path (or leave in memory).

The engine feeds counts from ``observe()`` metrics materialized by the sink
write — not extra ``count()`` jobs (SURVEY §4 item 1).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Any


def _ts() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


def _duration_seconds(start: str, end: str) -> float:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ"
    return round(
        (datetime.strptime(end, fmt) - datetime.strptime(start, fmt)).total_seconds(),
        3,
    )


class RunLog:
    """Mutable structured run log (parity: json_logger.py's dict structure)."""

    def __init__(self, run_id: str, pipeline_name: str = "pipeline"):
        self.doc: dict[str, Any] = {
            "run_id": run_id,
            "pipeline_name": pipeline_name,
            "created_at": _ts(),
            "status": "running",
            "stages": [],
        }

    def start_stage(self, name: str) -> dict[str, Any]:
        stage = {
            "stage": name,
            "started_at": _ts(),
            "completed_at": None,
            "duration_seconds": None,
            "status": "running",
            "sub_stages": [],
        }
        self.doc["stages"].append(stage)
        return stage

    def end_stage(self, stage: dict[str, Any], status: str = "success") -> None:
        stage["completed_at"] = _ts()
        stage["duration_seconds"] = _duration_seconds(
            stage["started_at"], stage["completed_at"]
        )
        stage["status"] = status

    @staticmethod
    def sub_stage(
        name: str, stage_type: str, started_at: str, status: str, **metrics: Any
    ) -> dict[str, Any]:
        completed_at = _ts()
        return {
            "name": name,
            "stage_type": stage_type,
            "started_at": started_at,
            "completed_at": completed_at,
            "duration_seconds": _duration_seconds(started_at, completed_at),
            "status": status,
            **metrics,
        }

    def finalize(self, status: str = "success") -> dict[str, Any]:
        self.doc["status"] = status
        self.doc["completed_at"] = _ts()
        return self.doc

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.doc, f, indent=2)

    @staticmethod
    def now() -> str:
        return _ts()
