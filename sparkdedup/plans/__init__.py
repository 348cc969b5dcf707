from sparkdedup.plans.pipeline import (SearchResult, build_signatures,
                                       search_clusters)

__all__ = ["SearchResult", "build_signatures", "search_clusters"]
