from sparkdedup.functions.hashing import with_file_id, with_sha256

__all__ = ["with_file_id", "with_sha256"]
