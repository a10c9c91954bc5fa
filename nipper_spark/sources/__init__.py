"""Input table loaders: synthetic pages generator, parquet readers."""
from nipper_spark.sources.synthetic import (  # noqa: F401
    PAGES_SCHEMA, fixture_pages_rows, pages_df, synth_pages_rows)
