package graft.sources

import graft.parse.Edn
import java.nio.file.{Files, Path}

/** Engine-state config store (SURVEY.md §2.1 S5): the reference keeps a
  * `~/.db_config` EDN map with the id counter, user, and the problem-name
  * dictionary (src/db_loader.clj:67-84). Same EDN shape here, read via the
  * engine's EDN parser, written via a canonical renderer — but the id counter
  * is only a *base*: actual ids are minted deterministically per batch
  * (graft.ids.IdMinter), so concurrent loaders never contend on this file
  * (the reference's abandoned file-locking problem, src/db_loader.clj:359-368).
  */
object ConfigStore {

  final case class EngineConfig(
      id: Long = 0L,
      user: String = "spark",
      dataDir: String = "",
      problemData: Map[String, Long] = Map.empty)

  def load(path: Path): EngineConfig =
    if (!Files.isRegularFile(path)) EngineConfig()
    else {
      Edn.parse(Files.readString(path)) match {
        case Edn.EMap(entries) =>
          def str(k: String): Option[String] = entries.collectFirst {
            case (Edn.EKeyword(`k`), v) => Edn.render(v)
          }
          val problemData = entries.collectFirst {
            case (Edn.EKeyword("problem_data"), Edn.EMap(pd)) =>
              pd.flatMap { case (k, v) =>
                Edn.render(v).toLongOption.map(Edn.render(k) -> _)
              }.toMap
          }.getOrElse(Map.empty[String, Long])
          EngineConfig(
            id = str("id").flatMap(_.toLongOption).getOrElse(0L),
            user = str("user").getOrElse("spark"),
            dataDir = str("data_dir").getOrElse(""),
            problemData = problemData)
        case _ => EngineConfig()
      }
    }

  def save(path: Path, cfg: EngineConfig): Unit = {
    val pd = cfg.problemData.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k" $v""" }.mkString("{", ", ", "}")
    val edn =
      s"""{:id ${cfg.id}
         | :user "${cfg.user}"
         | :data_dir "${cfg.dataDir}"
         | :problem_data $pd}""".stripMargin
    Files.writeString(path, edn)
  }
}
