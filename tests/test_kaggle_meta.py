"""G — Kaggle packaging: the reference's local publish-prep steps
(metadata JSON + zip-and-delete) reproduced exactly."""

from __future__ import annotations

import json
import os
from zipfile import ZipFile

from spotify_podcasts_airflow_batch_spark.sinks.kaggle_meta import (
    package_dataset,
)


def test_package_dataset_builds_upload_ready_folder(spark, sf_dir, tmp_path):
    from spotify_podcasts_airflow_batch_spark.pipeline.podcast import (
        PodcastPipeline,
    )

    out = str(tmp_path / "pods")
    pipe = PodcastPipeline(spark=spark, sf_dir=sf_dir, out_root=out)
    csv_path = pipe.run_daily()
    folder = os.path.dirname(csv_path)

    manifest = package_dataset(
        folder, dataset_id="user/top-podcasts", title="Top Podcasts"
    )

    with open(manifest["metadata"]) as f:
        meta = json.load(f)
    assert meta == {
        "id": "user/top-podcasts",
        "title": "Top Podcasts",
        "licenses": [{"name": "CC0-1.0"}],
    }

    assert manifest["archives"], "no CSVs were zipped"
    for z in manifest["archives"]:
        with ZipFile(z) as zf:
            names = zf.namelist()
            assert len(names) == 1 and names[0].endswith(".csv")
            assert zf.read(names[0]).startswith(b"date") or len(
                zf.read(names[0])
            )
        # original csv removed, like the reference's zip_and_delete
        assert not os.path.exists(z[: -len(".zip")] + ".csv")
