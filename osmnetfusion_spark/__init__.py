"""osmnetfusion_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query/data-processing capabilities of the reference
(VictoriaDhmn/OSMNetFusion, a single-machine pandas/geopandas pipeline) as
idiomatic Spark DataFrame operators:

- H3-style hierarchical grid cell index (pure column arithmetic, no UDF)
- cell-local spatial joins: kNN snap, point-in-polygon, intersection-length
- multimodal-network simplification: curve splitting, node clustering
  (distributed connected components), edge splitting, parallel-edge merging
  with merged-tag-dictionary folds
- Common-Crawl-style pages integration: geocode -> cell -> kNN snap to
  simplified edges -> raster/vector tile density
- web-scale training-data ops: exact/MinHash/SimHash/Jaccard/embedding dedup,
  ANN similarity search, language-ID, quality scoring, token counting,
  document fingerprinting

Execution model: DataFrame/Catalyst/AQE first; vectorized pandas/Arrow UDFs
only where built-ins cannot express the semantics (per-group geometry folds,
ray-casting refinement). No RDDs, no per-row Python UDFs.
"""

__version__ = "0.1.0"
