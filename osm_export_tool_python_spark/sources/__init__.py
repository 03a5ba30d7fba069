"""Sources: the interleaved-documents synthesizer, the span decoder,
and driver-geometry loaders (.poly / GeoJSON)."""
