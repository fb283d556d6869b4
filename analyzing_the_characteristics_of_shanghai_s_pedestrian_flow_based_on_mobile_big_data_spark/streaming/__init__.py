from .occupancy import streaming_occupancy  # noqa: F401
