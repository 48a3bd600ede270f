"""raydoc — Ray-Data-native transcript/document extraction engine.

A from-scratch rebuild of the document-to-markdown extraction core of
nyimin/SmolDocling-OCR ("DocFlow", /root/reference) as a streaming batch
pipeline over Parquet tables of multi-turn transcripts:

- ``raydoc.kernels``   pure per-turn / per-conversation transform functions
                       (the reference's deterministic semantics, no Ray)
- ``raydoc.stages``    Ray Data ``map_batches`` stages (incl. the stateful
                       extractor actor pool)
- ``raydoc.pipelines`` end-to-end Dataset pipelines (read → extract →
                       groupby(conv_id) document stage → partitioned write)
- ``raydoc.sources``   deterministic synthetic transcript generation
- ``raydoc.functions`` general large-scale data ops (dedup, ANN,
                       text analysis, relational, windows, multimodal)
- ``raydoc.state``     partition manifests / checkpoint-resume

See SURVEY.md for the full operator inventory and file:line citations into
the reference.
"""

__version__ = "0.1.0"
