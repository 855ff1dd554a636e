"""Run the connector pipeline from a connect.json — the engine's
equivalent of the reference daemon's `main` (main.rs:60-177):

    python examples/run_pipeline.py examples/connect.json [checkpoint_dir]

Loads the config (same file format as the reference), initializes the
manager (sources resolved to sinks by topic overlap), starts the
streaming queries, prints status, and blocks until Ctrl-C — on which it
stops cleanly. State (offsets, sink commits) lives in the checkpoint dir,
so a restart resumes exactly-once.

For an environment without a Kafka broker, switch the source's
``connector_class`` to ``"file"`` with a ``"path"`` config pointing at
KafkaRecord-schema parquet, or ``"rate"`` for synthetic load.
"""

from __future__ import annotations

import json
import sys
import time

from franzoxide_spark.config import load_config
from franzoxide_spark.manager import ConnectorManager
from franzoxide_spark.session import get_spark


def main() -> int:
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "examples/connect.json"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "/tmp/franzoxide_spark_ckpt"
    spark = get_spark(app_name="franzoxide_spark_pipeline")
    mgr = ConnectorManager(spark, load_config(cfg_path), ckpt)
    mgr.initialize()
    mgr.start()
    print(json.dumps(mgr.status(), indent=2, default=str))
    try:
        while True:
            time.sleep(10)
            for name, st in mgr.status().items():
                if "last_progress" in st and st["last_progress"]:
                    p = st["last_progress"]
                    print(f"{name}: {p.get('numInputRows', 0)} rows in last batch")
    except KeyboardInterrupt:
        print("stopping...")
        mgr.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
