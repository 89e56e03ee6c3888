package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.{MessageDigest, SecureRandom}

import graft.core._

/** An authenticated principal: the author name plus its authorization
  * level ("regular" | "admin"). Reference: `library/models/auth.js:97-123`
  * login/register both resolve to `{author, auth}`. */
final case class Identity(author: String, auth: String) {
  /** reference `ownerParam` (auth.js:38-41): a resource under
    * `/…/{author}:name` is editable by that author or any admin */
  def owns(resourceAuthor: String): Boolean =
    author == resourceAuthor || auth == Auth.Admin
}

/** Author accounts with salted-hash password verification — the
  * reference's auth model (`library/models/auth.js`) re-expressed over
  * the JVM: one CBOR account file per author
  * (`authorAccountPath` auth.js:80-90 → `<dir>/authors/<enc>/account.cbor`),
  * `passHash = SHA-512(salt ++ utf8(pass) ++ salt)` with a 64-byte
  * random salt (auth.js:106,138-141 — nacl.hash IS SHA-512), and the
  * same registration validation rules (auth.js:120-151): forbidden
  * punctuation, no exotic whitespace/control/format characters, name
  * 3..100 chars, password ≥ 8, reserved names rejected.
  *
  * This is control-plane state — a few KB of accounts gating an HTTP
  * façade — so it deliberately lives OFF Spark: no DataFrame, no job,
  * just atomic file writes next to the store. The data plane treats
  * "author" purely as a partition column (SURVEY §1.1); this class is
  * what turns the column into an enforced identity at the API edge.
  */
final class Auth(dir: Path) {

  Files.createDirectories(dir.resolve("authors"))

  private val rng = new SecureRandom()

  /** reference package.json `defaults.forbiddenAuthorNames` */
  private val ForbiddenNames = Set(
    "system", "admin", "owner", "root", "user", "author", "creator",
    "test", "support", "guest", "operator", "debug", "dev", "..", ".")

  /** reference auth.js:122 `badChars` (incl. backtick + smart quotes) */
  private val BadChars = "!*'();:@&=+$,/?%#[]`“‘’”".toSet

  // ---- model surface (auth.js exports) ----

  /** Register a new account; returns the identity or a human-readable
    * rejection (the reference throws assert messages; callers map these
    * to HTTP 400). Validation mirrors auth.js:120-151. */
  def register(author: String, pass: String, auth: String = Auth.Regular): Either[String, Identity] = synchronized {
    if (exists(author)) return Left("Someone else is using this name already, pick a different one")
    author.find(BadChars) match {
      case Some(c) => return Left(s"Name must not contain '$c'")
      case None => ()
    }
    def cat(ch: Char): Int = Character.getType(ch)
    if (author.exists(ch => ch != ' ' && cat(ch) == Character.SPACE_SEPARATOR))
      return Left("Name must not contain whitespace other than regular spaces")
    if (author.exists(ch => cat(ch) == Character.CONTROL))
      return Left("Name must not contain control characters")
    if (author.exists(ch => cat(ch) == Character.FORMAT))
      return Left("Name must not contain unicode format characters")
    if (author.exists(ch => cat(ch) == Character.LINE_SEPARATOR))
      return Left("Name must not contain unicode line seperator characters")
    if (author.exists(ch => cat(ch) == Character.PARAGRAPH_SEPARATOR))
      return Left("Name must not contain unicode paragraph seperator characters")
    if (ForbiddenNames.contains(author)) return Left("Name is not allowed by site settings")
    if (author.length < 3) return Left("Name must be at least 3 characters long")
    if (author.length > 100) return Left("Name must not be longer than 100 characters")
    if (pass.length < 8) return Left("Password must be at least 8 characters long")
    val salt = new Array[Byte](64)
    rng.nextBytes(salt)
    if (!writeAccount(author, PoObj(
      "passSalt" -> PoBytes(salt),
      "passHash" -> PoBytes(hash(salt, pass)),
      "auth" -> PoStr(auth)), createNew = true))
      return Left("Someone else is using this name already, pick a different one")
    Right(Identity(author, auth))
  }

  /** Check a login attempt (auth.js:97-113); error strings match the
    * reference's thrown messages. */
  def login(author: String, pass: String): Either[String, Identity] =
    readAccount(author) match {
      case None => Left("Account not found")
      case Some(acct) =>
        val salt = bytesField(acct, "passSalt")
        val stored = bytesField(acct, "passHash")
        // MessageDigest.isEqual is constant-time: a byte-wise early-exit
        // compare would leak hash-prefix length through response timing
        if (!MessageDigest.isEqual(hash(salt, pass), stored)) Left("Password incorrect")
        else Right(Identity(author, strField(acct, "auth")))
    }

  /** auth.js:156-166 — fresh salt on every password change */
  def changePassword(author: String, newPass: String): Either[String, Unit] = synchronized {
    readAccount(author) match {
      case None => Left("Author account name not found")
      case Some(acct) =>
        val salt = new Array[Byte](64)
        rng.nextBytes(salt)
        writeAccount(author, PoObj(
          "passSalt" -> PoBytes(salt),
          "passHash" -> PoBytes(hash(salt, newPass)),
          "auth" -> PoStr(strField(acct, "auth"))))
        Right(())
    }
  }

  /** auth.js:169-175 — change authorization level */
  def changeAuth(author: String, auth: String): Either[String, Unit] = synchronized {
    readAccount(author) match {
      case None => Left("Author account name not found")
      case Some(acct) =>
        writeAccount(author, PoObj(
          "passSalt" -> PoBytes(bytesField(acct, "passSalt")),
          "passHash" -> PoBytes(bytesField(acct, "passHash")),
          "auth" -> PoStr(auth)))
        Right(())
    }
  }

  /** auth.js:178-182 — public profile: never the salt or hash */
  def profile(author: String): Option[Identity] =
    readAccount(author).map(acct => Identity(author, strField(acct, "auth")))

  /** auth.js:186-190 */
  def delete(author: String): Unit = synchronized {
    graft.core.Fs.rmTree(authorDir(author))
  }

  def exists(author: String): Boolean = Files.exists(accountPath(author))

  /** auth.js:202-216 — all author names, reserved names filtered;
    * sorted for deterministic listings (the reference yields readdir
    * order, which is filesystem-dependent) */
  def list(): Vector[String] = {
    val base = dir.resolve("authors")
    if (!Files.isDirectory(base)) return Vector.empty
    val out = Vector.newBuilder[String]
    val ds = Files.newDirectoryStream(base)
    try {
      ds.forEach { p =>
        if (Files.exists(p.resolve("account.cbor"))) {
          val name = decodeName(p.getFileName.toString)
          if (!ForbiddenNames.contains(name)) out += name
        }
      }
    } finally ds.close()
    out.result().sorted
  }

  // ---- internals ----

  private def hash(salt: Array[Byte], pass: String): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-512")
    md.update(salt)
    md.update(pass.getBytes(UTF_8))
    md.update(salt)
    md.digest()
  }

  /** percent-encode anything outside [A-Za-z0-9_-] so any author name —
    * spaces, unicode, and crucially "." / ".." — maps to a safe single
    * path segment that can never resolve upward: `authorDir("..")` is
    * `authors/%2E%2E`, not the auth root. ('.' is deliberately NOT in
    * the allowed set: a name of only dots would otherwise turn
    * `delete`/`rmTree` into a traversal, and delete takes raw names
    * with no registration-time validation in front of it.) */
  private def encodeName(author: String): String = {
    val sb = new StringBuilder
    author.getBytes(UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || c == '_' || c == '-') sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  private def decodeName(enc: String): String = {
    val bytes = Array.newBuilder[Byte]
    var i = 0
    while (i < enc.length) {
      if (enc.charAt(i) == '%' && i + 3 <= enc.length) {
        bytes += Integer.parseInt(enc.substring(i + 1, i + 3), 16).toByte; i += 3
      } else { bytes += enc.charAt(i).toByte; i += 1 }
    }
    new String(bytes.result(), UTF_8)
  }

  private def authorDir(author: String): Path = dir.resolve("authors").resolve(encodeName(author))
  private def accountPath(author: String): Path = authorDir(author).resolve("account.cbor")

  /** `createNew = true` (registration): publish via `Files.createLink`,
    * which is atomic CREATE-NEW — two PROCESSES racing a registration
    * of one name can't silently replace each other's account (an
    * ATOMIC_MOVE rename would: POSIX rename always replaces). The
    * in-instance `synchronized` only covers threads; this covers the
    * dual-server topology the store's commit locks already serve.
    * Returns false when the name was taken underneath us. */
  private def writeAccount(author: String, value: PoObj, createNew: Boolean = false): Boolean = {
    val target = accountPath(author)
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".account-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, Cbor.encode(value))
    try {
      if (createNew) {
        try { Files.createLink(target, tmp); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: UnsupportedOperationException =>
            // no-hardlink filesystem: degrade to rename (last-writer-wins
            // on a cross-process race, same as before this guard)
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
            true
        }
      } else {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        true
      }
    } finally Files.deleteIfExists(tmp)
  }

  private def readAccount(author: String): Option[PoObj] =
    if (!Files.exists(accountPath(author))) None
    else Cbor.decode(Files.readAllBytes(accountPath(author))) match {
      case o: PoObj => Some(o)
      case _ => None
    }

  private def bytesField(o: PoObj, k: String): Array[Byte] = o.fields.get(k) match {
    case Some(b: PoBytes) => b.bytes
    case _ => Array.emptyByteArray
  }
  private def strField(o: PoObj, k: String): String = o.fields.get(k) match {
    case Some(PoStr(s)) => s
    case _ => Auth.Regular
  }
}

object Auth {
  val Regular = "regular"
  val Admin = "admin"
}
