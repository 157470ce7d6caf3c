package graft.queries

import graft.core.GraftQuery

/** Central registry of all verifiable operators. Each pack is one area of
  * SURVEY.md §2 / the extension surface; SparkEntry exposes the union.
  */
object Registry {
  def packs: Seq[Seq[GraftQuery]] = Seq(
    RelationalQueries.all,
    RelationalFnQueries.all,
    EtlQueries.all,
    ExtQueries.all,
    MediaQueries.all,
    WebpQueries.all,
    AudioQueries.all,
    TextQueries.all,
    SimQueries.all,
    StreamQueries.all,
    ScaleQueries.all,
    SketchQueries.all,
    CorpusQueries.all,
    PackingQueries.all,
    DeconQueries.all,
    QcQueries.all,
    MixtureQueries.all,
    PipelineQueries.all,
    VocabQueries.all,
    GraphQueries.all,
    WarcQueries.all,
    UrlQueries.all,
    TarQueries.all,
    CompressedShardQueries.all,
    MailQueries.all,
    RecordShardQueries.all,
    TensorShardQueries.all,
    QuantShardQueries.all,
    ChatQueries.all,
    MediaMetaQueries.all,
    DocQueries.all,
    CaptionQueries.all,
  )

  lazy val all: Seq[GraftQuery] = {
    val qs = packs.flatten
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
