"""Driver-side feed fetch edge — the network boundary of the pipeline.

Mirrors the reference's download helpers (get_file_lastModifiedDate
:46-64, get_from_nist :102-110, unzip :113-123) as a thin, mockable
layer: HTTP GET .meta + zip into a landing dir, extract the JSON.
Unlike the reference it fetches each .meta ONCE per run (the reference
re-fetches for the audit row, :71 vs :440 — SURVEY §4.1).

Network code is import-gated: tests and the data plane never need it
(fixture files land in the landing dir directly — the landing dir IS
the replayable bronze source, SURVEY §2 #13).
"""

from __future__ import annotations

import re
import zipfile
from pathlib import Path

BASE_URL = "https://nvd.nist.gov/feeds/json/cve/1.1/"
FEED_TEMPLATE = "nvdcve-1.1-{modifier}.json.zip"


def feed_names(this_year: int, get_all: bool = False) -> list[str]:
    """Feed modifier list (nvd2mysqlloader.py:154-163): full backfill =
    2002..current + modified + recent; default refresh = modified+recent."""
    mods = [str(y) for y in range(2002, this_year + 1)] if get_all else []
    return mods + ["modified", "recent"]


def download_feed(modifier: str, landing: str, base_url: str = BASE_URL) -> Path:
    """GET the zip + .meta for one feed into ``landing`` and extract
    the JSON. Requires network; callers in tests stub this out."""
    import requests  # gated: only the real fetch edge needs it

    landing_p = Path(landing)
    landing_p.mkdir(parents=True, exist_ok=True)
    zip_name = re.sub("year", modifier, FEED_TEMPLATE.replace("{modifier}", "year"))
    zip_url = base_url + zip_name
    meta_url = zip_url.replace("json.zip", "meta")   # ref :56

    meta_resp = requests.get(meta_url, timeout=60)
    meta_resp.raise_for_status()   # a 404/503 body is NOT a .meta file
    meta_path = landing_p / zip_name.replace("json.zip", "meta")
    meta_path.write_bytes(meta_resp.content)

    zip_resp = requests.get(zip_url, timeout=120)
    zip_resp.raise_for_status()
    zip_path = landing_p / zip_name
    zip_path.write_bytes(zip_resp.content)
    with zipfile.ZipFile(zip_path) as zf:            # ref :113-123
        zf.extractall(landing_p)
    zip_path.unlink()
    return landing_p / zip_name.replace(".zip", "")
