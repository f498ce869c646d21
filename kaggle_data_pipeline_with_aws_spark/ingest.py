"""Raw-zone ingest (SURVEY §2.1 S1/S2, §3 EP1).

The reference's weekly download Lambda fetches ``t20s_male_json.zip``
from cricsheet.org, extracts thousands of per-match JSONs, and uploads
the new ones to S3 (``download_from_cricsheet_lambda_function.py:40-119``).
Ingest is driver-side IO, not a distributed operator — the landing
directory this writes IS the engine's Spark source — but the
*selection* semantics (only ``*.json``, only files not in the ledger,
at most N per cycle) belong to the engine and are applied by
``pipeline.run_incremental`` / the streaming file source downstream.

``fetch_zip`` is separated from ``extract_zip`` so tests (and air-gapped
runs) can exercise extraction + landing against a local archive without
any network dependency.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile


def fetch_zip(url: str, dest_path: str, timeout_s: int = 10) -> str:
    """S1: download an archive to a local path (10 s timeout like the
    reference's ``requests.get(..., timeout=10)``)."""
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        with open(dest_path, "wb") as out:
            shutil.copyfileobj(resp, out)
    return dest_path


def extract_zip(
    zip_path: str,
    landing_dir: str,
    suffix: str = ".json",
) -> list[str]:
    """S2 + P4: extract, keep only ``*.json`` members, land them flat.

    Extraction happens into a temp dir and files MOVE into the landing
    zone one by one — a reader (or the streaming file source) never
    observes a partially-written file, mirroring S3-object-PUT
    atomicity. Returns the landed file names (sorted, stable)."""
    landed: list[str] = []
    os.makedirs(landing_dir, exist_ok=True)
    # staging lives INSIDE the landing zone so the final rename stays on
    # one filesystem (os.replace is only atomic within a filesystem)
    with tempfile.TemporaryDirectory(
        dir=landing_dir, prefix=".__incoming__"
    ) as tmp:
        with zipfile.ZipFile(zip_path) as zf:
            for member in zf.namelist():
                base = os.path.basename(member)
                if not base or not base.endswith(suffix):
                    continue
                src = zf.extract(member, tmp)
                dst = os.path.join(landing_dir, base)
                os.replace(src, dst)  # atomic within a filesystem
                landed.append(base)
    return sorted(landed)
