from .tables import (  # noqa: F401
    EVENTS_SCHEMA,
    PINGS_SCHEMA,
    POI_SCHEMA,
    REGION_GEOHASH_SCHEMA,
    TESTDATA_TABLES,
    events_as_pings,
    fan_out_small_scan,
    load_events,
    load_table,
    read_pings_tsv,
    read_poi_csv,
    read_poi_district_csv,
    write_partitioned_parquet,
)
from .xlsx import read_poi_xlsx, read_xlsx_rows  # noqa: F401
