from .occupancy import streaming_occupancy  # noqa: F401
from .joins import windowed_stream_join  # noqa: F401
from .sessions import (  # noqa: F401
    run_session_stream_to_memory,
    streaming_session_counts,
)
