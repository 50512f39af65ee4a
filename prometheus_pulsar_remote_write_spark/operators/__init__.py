"""Row transforms and extension operators (dedup/similarity/text/multimodal)."""
