"""Per-document scalar kernels. Everything here is pure Python/numpy,
invoked ONLY from Arrow-batched pandas UDFs / mapInPandas — never per
DataFrame row at the driver."""
