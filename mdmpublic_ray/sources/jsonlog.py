"""JSONL record source (SURVEY.md §2.1 S-family, JSON leg): a
deterministic API-request-log fixture + ``ray.data.read_json``
ingestion — the structured-log counterpart of ``textlog.py``'s
line-oriented source (reference analog: the JSON-bodied monitoring
payloads of ``jenkins_scripts/report/*.sh`` piped through jq-style
extraction; here typed end-to-end through Arrow's JSON reader).

Like the auth-log fixture, generation is FIXED-seed and sf-independent
so the Ray pipeline and the DuckDB ``read_json_auto`` oracle read
byte-identical inputs at every sf. Records carry a nullable field
(``user``) and a nested object (``meta.region``) so the queries
exercise JSON null handling and struct-field extraction, not just flat
projection.
"""

from __future__ import annotations

import json
import os
import random

FIXTURE_DIR = "/tmp/mdmpublic_ray_fixtures"
API_LOG = os.path.join(FIXTURE_DIR, "api_requests.jsonl")
N_RECORDS = 5000
_SEED = 271828

_ENDPOINTS = ["/api/users", "/api/orders", "/api/search", "/api/export", "/healthz"]
_REGIONS = ["eu-west", "us-east", "ap-south"]
_USERS = [f"svc-{i:02d}" for i in range(12)]
_STATUSES = [200, 200, 200, 200, 201, 204, 400, 404, 500, 503]


def api_log_path() -> str:
    """Generate-if-missing and return the fixture path (atomic publish)."""
    if os.path.exists(API_LOG):
        return API_LOG
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = random.Random(_SEED)
    tmp = API_LOG + ".tmp"
    t = 1_704_880_000  # fixed epoch base
    with open(tmp, "w") as f:
        for i in range(N_RECORDS):
            t += rng.randrange(1, 30)
            rec = {
                "request_id": i,
                "epoch": t,
                "user": None if rng.random() < 0.1 else rng.choice(_USERS),
                "endpoint": rng.choice(_ENDPOINTS),
                "status": rng.choice(_STATUSES),
                "latency_ms": rng.randrange(1, 2000),
                "meta": {"region": rng.choice(_REGIONS)},
            }
            f.write(json.dumps(rec) + "\n")
    os.replace(tmp, API_LOG)
    return API_LOG


def read_api_log():
    """``ray.data.read_json`` over the fixture (Arrow JSON reader —
    typed columns incl. the nested struct, no per-row Python parse)."""
    import ray.data as rd

    return rd.read_json(api_log_path())
