"""Source-side infrastructure: catalog discovery + file-manifest pruning."""
