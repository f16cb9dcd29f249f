"""Config loading (YAML/JSON dict trees).

Mirrors the reference's {data, model, train} YAML sections
(src/ananke_abm/models/gen_schedule/utils/cfg.py:6-10 and
dataio/configs/*.yaml) so reference configs port 1:1.
"""
from __future__ import annotations

import json
import os


def load_config(path: str) -> dict:
    with open(path, "r", encoding="utf-8") as f:
        if path.endswith(".json"):
            return json.load(f)
        import yaml

        return yaml.safe_load(f)


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
