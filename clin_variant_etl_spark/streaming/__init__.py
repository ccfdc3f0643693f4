from .stream import StreamingCdc  # noqa: F401
