"""PySpark-native pedestrian-flow analytics engine.

Re-expresses, Spark-first, the capabilities of the reference repo
``fclin0907/Analyzing-the-Characteristics-of-Shanghai-s-Pedestrian-Flow-
Based-on-Mobile-Big-Data`` (read-only at /root/reference): hourly
region-occupancy, OD mobility matrices, home-location detection,
POI-type occupancy — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) the 100 TB north star requires.

Everything is DataFrame/Catalyst-native: no RDD usage, no driver-side
loops, python only as Arrow-vectorized pandas UDFs (geohash encode and
multimodal decode are the sole cases).

Import alias convention used throughout tests and the entry module::

    import analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark as shflow
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
