"""Host-side data pipeline: tokenization, image geometry, readers, builders."""
