"""industry_big_data_time_sequence_process_spark — a PySpark-native
time-series analytics engine.

Importing this package registers every operator into ``registry.REGISTRY``;
``__spark_entry__.py`` at the repo root exposes the driver contract from it.
"""
from . import registry  # noqa: F401

# Import order == SURVEY.md §2 section order; each import registers ops.
from .operators import (  # noqa: F401,E402
    features, multimodal, pipeline, relational, sampling, similarity,
    sources_sinks, streaming, text, timeseries, udfs, windows,
)
from .functions import scalar  # noqa: F401,E402
