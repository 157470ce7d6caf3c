package graft.core

/** Shared decode-amplification budgets (round 12). DEFLATE's ~1032:1 max
  * expansion means a 1 MB crafted gzip member / zip entry / PDF stream can
  * legally demand ~1 GB of heap BEFORE any trailer or CRC check can fail —
  * one such blob per executor is an OOM kill on a large crawl scan, the
  * byte-stream twin of [[graft.ops.Multimodal.MaxDecodePixels]]. Every
  * inflating reader (WARC gzip members, ZIP entries, PDF FlateDecode)
  * checks its OUTPUT size against this budget while inflating and refuses
  * with a typed error the safe scans turn into one error row.
  *
  * A `@volatile var` (seeded from `-Dgraft.io.maxInflatedBytes`) rather
  * than a fixed val so trusted-corpus jobs can raise it at startup and
  * specs can exercise the refusal without building multi-hundred-MB bombs.
  */
object Budget {
  @volatile var maxInflatedBytes: Long =
    sys.props.get("graft.io.maxInflatedBytes").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
}
