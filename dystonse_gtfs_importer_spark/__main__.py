"""``python -m dystonse_gtfs_importer_spark`` — the reference CLI
surface (main.rs:231-251) over the Spark engine."""

from .cli import main

raise SystemExit(main())
