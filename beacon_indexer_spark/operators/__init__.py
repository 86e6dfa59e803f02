"""Operator library: the reference's query surface (SURVEY §2.3-2.8) plus
the large-scale training-data operators (dedup, similarity, text analysis,
multimodal plumbing) the north star calls for."""
