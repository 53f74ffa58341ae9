"""Kaggle dataset packaging — the LOCAL half of the reference's
publish step, implemented for real.

Reference (dags/spotify/include/kaggle.py):
  - ``create_kaggle_metadata`` (kaggle.py:34-55): writes
    ``dataset-metadata.json`` with id / title / licenses.
  - ``zip_and_delete_csv_files`` (kaggle.py:17-31): zips every CSV in
    the folder, removing the originals.
  - ``create_kaggle_dataset`` / version update (kaggle.py:57+): shells
    out to the ``kaggle`` CLI — the only part that needs credentials,
    and the only part stubbed here (sinks/writers.upload_to_kaggle).

Everything before the upload is deterministic local file assembly, so
the engine ships it working: a pipeline run produces the exact folder
layout the ``kaggle datasets create/version`` CLI consumes.
"""

from __future__ import annotations

import json
import os
from zipfile import ZIP_DEFLATED, ZipFile


def create_kaggle_metadata(
    kaggle_folder: str,
    dataset_id: str,
    title: str,
    license_name: str = "CC0-1.0",
) -> str:
    """Write ``dataset-metadata.json`` (kaggle.py:34-55 — same fields).
    The reference's literal default is "CC1-1.0", which is not a valid
    Kaggle license identifier (their CLI upload would reject it); the
    intended public-domain id is "CC0-1.0", corrected here. Returns
    the metadata path."""
    os.makedirs(kaggle_folder, exist_ok=True)
    meta = {
        "id": dataset_id,
        "title": title,
        "licenses": [{"name": license_name}],
    }
    path = os.path.join(kaggle_folder, "dataset-metadata.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    return path


def zip_csv_files(kaggle_folder: str, delete_originals: bool = True) -> list[str]:
    """Zip every CSV under the folder (kaggle.py:17-31): each
    ``x.csv`` becomes ``x.zip`` holding just that file's basename;
    originals are removed like the reference does (the CLI uploads the
    folder as-is, and Kaggle rejects mixed zip+csv duplicates).
    Returns the zip paths."""
    zips = []
    for root, _, files in os.walk(kaggle_folder):
        for name in files:
            if not name.endswith(".csv"):
                continue
            csv_path = os.path.join(root, name)
            zip_path = csv_path[: -len(".csv")] + ".zip"
            with ZipFile(zip_path, "w", ZIP_DEFLATED) as zf:
                zf.write(csv_path, os.path.basename(csv_path))
            if delete_originals:
                os.remove(csv_path)
            zips.append(zip_path)
    return sorted(zips)


def package_dataset(
    kaggle_folder: str, dataset_id: str, title: str, license_name: str = "CC0-1.0"
) -> dict:
    """Assemble the complete upload-ready folder: metadata + zipped
    CSVs. Returns a manifest of what the (stubbed) CLI step would
    ship. This is ``create_kaggle_dataset`` minus the subprocess."""
    meta = create_kaggle_metadata(kaggle_folder, dataset_id, title, license_name)
    zips = zip_csv_files(kaggle_folder)
    return {"metadata": meta, "archives": zips, "folder": kaggle_folder}
