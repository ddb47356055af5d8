"""Deterministic raw-event fixture generator with parameterized fault rates.

Reproduces the reference's test philosophy (SURVEY §5): seeded synthetic
NDJSON with injected quality faults at controlled rates, laid out as
``base/source_system=app/ingestion_date=YYYY-MM-DD/events.json``.  Rates are
knobs so tests can push past DQ thresholds (the reference's defaults sit
inside them: 2% null user < 3% ceiling, 1% dup < 2% ceiling).
"""

from __future__ import annotations

import json
import os
import random
import uuid

from prod_data_pipeline_spark.schemas import VALID_EVENT_TYPES


def generate_raw_events(
    base: str,
    dates: list[str],
    rows_per_day: int = 400,
    null_user_rate: float = 0.02,
    dup_rate: float = 0.01,
    invalid_type_rate: float = 0.0,
    null_id_rate: float = 0.0,
    seed: int = 42,
    source_system: str = "app",
    append: bool = False,
    id_prefix: str = "",
    filename: str = "events.json",
) -> dict[str, int]:
    """Returns rows written per date (including injected duplicates)."""
    counts: dict[str, int] = {}
    for d in dates:
        rng = random.Random(f"{seed}:{d}")
        rows = []
        for i in range(rows_per_day):
            etype = rng.choice(VALID_EVENT_TYPES)
            if invalid_type_rate and rng.random() < invalid_type_rate:
                etype = "bogus_type"
            event_id = f"{id_prefix}{uuid.UUID(int=rng.getrandbits(128))}"
            if null_id_rate and rng.random() < null_id_rate:
                event_id = None
            sec = rng.randrange(86400)
            row = {
                "event_id": event_id,
                "user_id": None if rng.random() < null_user_rate else str(rng.randrange(1, 501)),
                "event_type": etype,
                "event_ts": f"{d}T{sec // 3600:02d}:{sec % 3600 // 60:02d}:{sec % 60:02d}Z",
                "amount": round(rng.uniform(5, 200), 2) if etype == "purchase" else None,
            }
            rows.append(row)
            if dup_rate and rng.random() < dup_rate:
                dup = dict(row)
                dup["event_ts"] = f"{d}T{min(sec + 60, 86399) // 3600:02d}:00:00Z"
                rows.append(dup)
        part_dir = os.path.join(base, f"source_system={source_system}", f"ingestion_date={d}")
        os.makedirs(part_dir, exist_ok=True)
        mode = "a" if append else "w"
        with open(os.path.join(part_dir, filename), mode) as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        counts[d] = len(rows)
    return counts
