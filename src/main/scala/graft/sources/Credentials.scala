package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Opaque secret value: the String comes out only via [[reveal]], and
  * toString is masked — so a secret cannot leak through log lines,
  * exception messages, or debug dumps by accident.
  */
final class Secret(private val value: String) {
  def reveal: String = value
  override def toString: String = "Secret(****)"
  override def equals(o: Any): Boolean = o match {
    // Compare SHA-256 digests, not the raw bytes: isEqual is constant-time
    // only for EQUAL-length inputs (it returns immediately on a length
    // mismatch), so digesting first — fixed 32-byte output — is what makes
    // "no length/prefix leak" actually hold.
    case s: Secret =>
      def d(v: String) = java.security.MessageDigest.getInstance("SHA-256").digest(v.getBytes("UTF-8"))
      java.security.MessageDigest.isEqual(d(value), d(s.value))
    case _ => false
  }
  override def hashCode: Int = 17 // deliberately constant — no value-derived bits escape
}

/** Credential-resolution indirection — the analogue of the reference's
  * secret-manager lookup at connect time
  * (app/cloud-sql-query-runner/get_secret.py:8-14, secrets.tf:29-41):
  * code carries a secret NAME; the VALUE is resolved at connect time from
  * a pluggable source and handed to the JDBC driver as connection
  * properties — never embedded in a URL, never logged. No cloud SDK: the
  * two production-shaped sources are environment variables and a mounted
  * properties file, which is exactly how secret managers present values
  * to a container.
  */
trait CredentialSource {
  def resolve(name: String): Option[Secret]

  /** Resolve or fail; the error names the MISSING KEY, never any value. */
  final def required(name: String): Secret =
    resolve(name).getOrElse(
      throw new IllegalArgumentException(s"credential '$name' not resolvable"))
}

object CredentialSource {

  /** Environment variables, with the conventional name mangling:
    * `db.password` resolves from `DB_PASSWORD`.
    */
  final class Env(env: Map[String, String] = sys.env) extends CredentialSource {
    def resolve(name: String): Option[Secret] =
      env.get(name.toUpperCase.replace('.', '_').replace('-', '_')).map(new Secret(_))
  }

  /** `name=value` lines in a properties-style file (the file-mount shape a
    * secret manager presents); `#` comments and blank lines skipped,
    * values may themselves contain `=`. Re-read per resolve so rotation
    * (the reason the reference resolves at CONNECT time, not startup) is
    * picked up without a restart.
    */
  final class PropsFile(path: Path) extends CredentialSource {
    def resolve(name: String): Option[Secret] =
      if (!Files.isReadable(path)) None
      else
        Files.readAllLines(path).asScala.iterator
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .flatMap { l =>
            l.indexOf('=') match {
              case -1 => None
              case i  => Some(l.take(i).trim -> l.drop(i + 1).trim)
            }
          }
          .collectFirst { case (k, v) if k == name => new Secret(v) }
  }

  /** First source that resolves a name wins (env overriding file is the
    * common deployment chain).
    */
  final class Chain(sources: CredentialSource*) extends CredentialSource {
    def resolve(name: String): Option[Secret] =
      sources.iterator.flatMap(_.resolve(name)).nextOption()
  }

  /** In-memory source for tests. */
  final case class Static(values: Map[String, String]) extends CredentialSource {
    def resolve(name: String): Option[Secret] = values.get(name).map(new Secret(_))
  }
}

/** The user/password pair resolved for one JDBC endpoint. Masked
  * toString (case-class default would print the Secret's mask anyway,
  * but the user name can be sensitive too in some deployments).
  */
final case class JdbcAuth(user: String, password: Secret) {
  override def toString: String = "JdbcAuth(****)"
}

object JdbcAuth {
  /** Resolve both halves by NAME at connect time — the get_secret shape:
    * the caller owns key names, the source owns values.
    */
  def resolve(src: CredentialSource, userKey: String, passwordKey: String): JdbcAuth =
    JdbcAuth(src.required(userKey).reveal, src.required(passwordKey))
}
