"""CLI drivers: ``python -m leastereo_tpu.cli.<driver>``.

Driver map (reference -> here):
  search.py     -> leastereo_tpu.cli.search
  decode.py     -> leastereo_tpu.cli.decode
  train.py      -> leastereo_tpu.cli.train
  predict.py    -> leastereo_tpu.cli.predict
  evaluation.py -> leastereo_tpu.cli.evaluate
  make_onnx.py  -> leastereo_tpu.cli.export (StableHLO / SavedModel)
  (.pth import) -> leastereo_tpu.cli.convert (reference checkpoint -> orbax)
"""
