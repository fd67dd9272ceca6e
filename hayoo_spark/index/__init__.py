"""Index build side: posting-list codec, segment builder, manifests."""
