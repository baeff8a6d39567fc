from .binary import (media_from_documents, decode_media_features,  # noqa: F401
                     resize_images, sample_frames, MEDIA_SCHEMA,
                     FEATURE_SCHEMA)
