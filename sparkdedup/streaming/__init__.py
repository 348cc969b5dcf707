from sparkdedup.streaming.ingest import (incremental_dedup,  # noqa: F401
                                         stream_signatures)
