"""`python -m pathway_spark ...` — reference `python/pathway/__main__.py`."""
from pathway_spark.cli import main

raise SystemExit(main())
