from sparkdedup.sources.files import read_files, split_invalid

__all__ = ["read_files", "split_invalid"]
