"""CSV feed source (SURVEY.md §2.1 S-family, CSV leg): a deterministic
inventory-feed fixture + ``ray.data.read_csv`` ingestion — the
comma-separated counterpart of ``textlog.py`` (raw lines), ``jsonlog.py``
(JSONL) and the parquet tables, completing the source-format family
(reference analog: the csv-ish report outputs of
``jenkins_scripts/report/*.sh`` re-ingested by downstream jobs).

Fixed-seed, sf-independent generation so the Ray pipeline and the
DuckDB ``read_csv_auto`` oracle read byte-identical inputs. Quantities
and prices are integers (cents) so every aggregate is exact.
"""

from __future__ import annotations

import os
import random

FIXTURE_DIR = "/tmp/mdmpublic_ray_fixtures"
INVENTORY_CSV = os.path.join(FIXTURE_DIR, "inventory.csv")
N_ROWS = 6000
_SEED = 314159

_WAREHOUSES = ["fra1", "iad2", "sin3", "syd4"]
_CATEGORIES = ["widget", "gadget", "gizmo", "doodad", "sprocket"]


def inventory_csv_path() -> str:
    """Generate-if-missing and return the fixture path (atomic publish)."""
    if os.path.exists(INVENTORY_CSV):
        return INVENTORY_CSV
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    rng = random.Random(_SEED)
    tmp = INVENTORY_CSV + ".tmp"
    with open(tmp, "w") as f:
        f.write("sku,warehouse,category,qty,unit_cents,updated\n")
        for i in range(N_ROWS):
            day = rng.randrange(1, 28)
            f.write(
                f"SKU-{i:05d},{rng.choice(_WAREHOUSES)},{rng.choice(_CATEGORIES)},"
                f"{rng.randrange(0, 500)},{rng.randrange(99, 99999)},"
                f"2024-02-{day:02d}\n"
            )
    os.replace(tmp, INVENTORY_CSV)
    return INVENTORY_CSV


def read_inventory():
    """``ray.data.read_csv`` over the fixture (Arrow CSV reader — typed
    int64/string columns, header inferred)."""
    import ray.data as rd

    return rd.read_csv(inventory_csv_path())
