from dish_data_pipeline_spark.sources.rest import (
    fetch_paginated_data,
    fetch_pages_distributed,
    records_to_dataframe,
)

__all__ = [
    "fetch_paginated_data",
    "fetch_pages_distributed",
    "records_to_dataframe",
]
