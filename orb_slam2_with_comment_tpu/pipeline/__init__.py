from .tracking import Tracker, TrackerConfig, TrackState  # noqa: F401
