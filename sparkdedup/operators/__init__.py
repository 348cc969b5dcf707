from sparkdedup.operators.exact import exact_edges
from sparkdedup.operators.components import connected_components
from sparkdedup.operators.ranking import rank_clusters

__all__ = ["exact_edges", "connected_components", "rank_clusters"]
