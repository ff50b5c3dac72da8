"""`python -m pathway_spark ...` — reference `python/pathway/__main__.py`."""
if __name__ == "__main__":
    from pathway_spark.cli import main

    raise SystemExit(main())
