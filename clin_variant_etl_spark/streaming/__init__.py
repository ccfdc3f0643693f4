from .stream import StreamingCdc  # noqa: F401
from .windows import windowed_event_counts  # noqa: F401
