package object graft {
  /** Table names available under each `/root/testdata/sf*` dir. */
  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")
}
