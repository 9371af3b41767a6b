from .blobs import blob_meta, decode_blob_features, with_blob

__all__ = ["blob_meta", "decode_blob_features", "with_blob"]
