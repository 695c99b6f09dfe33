package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** `.env` config bootstrap — the reference's godotenv load + `os.Getenv`
  * pattern (reference `main.go:252-266`: `.env` supplies
  * `HCP_CLIENT_ID`/`HCP_CLIENT_SECRET`/connection settings unless the
  * process environment already has them).
  *
  * Format: `KEY=VALUE` lines; blank lines and `#` comments ignored;
  * optional single/double quotes around the value; no interpolation.
  * Process environment WINS over the file (godotenv semantics: `Load`
  * does not override existing vars). */
object EnvConfig {

  def parse(lines: Seq[String]): Map[String, String] =
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val (k, v) = l.splitAt(l.indexOf('='))
        k.trim -> unquote(v.drop(1).trim)
      }.toMap

  private def unquote(v: String): String =
    if (v.length >= 2 &&
      ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** File values overlaid by the real environment. A missing file is not
    * an error (same as godotenv usage with only real env set). */
  def load(path: String = ".env",
      env: Map[String, String] = sys.env): Map[String, String] = {
    val p = Paths.get(path)
    val fromFile =
      if (Files.isRegularFile(p)) parse(Files.readAllLines(p).asScala.toSeq)
      else Map.empty[String, String]
    fromFile ++ env
  }

  /** Required key or a configuration error naming it — the reference
    * would instead send `Bearer <empty>` and fail opaquely downstream. */
  def required(cfg: Map[String, String], key: String): String =
    cfg.getOrElse(key, throw new IllegalArgumentException(
      s"missing required config key $key (set it in .env or the environment)"))

  /** The reference's concrete bootstrap composed end-to-end: client
    * credentials from config → OAuth2 [[TokenProvider]]
    * (`main.go:84-119,260-266`). */
  def hcpTokenProvider(cfg: Map[String, String],
      tokenUrl: String = "https://auth.idp.hashicorp.com/oauth2/token",
      audience: String = "https://api.hashicorp.cloud"): TokenProvider =
    TokenProvider.oauth2ClientCredentials(tokenUrl,
      required(cfg, "HCP_CLIENT_ID"), required(cfg, "HCP_CLIENT_SECRET"),
      Some(audience))
}
