package graft.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.SecretKeyFactory

/** SCRAM-SHA-256 server-side handshake (RFC 5802 / RFC 7677 — the
  * public protocol; pg's preferred password auth since v10; reference
  * exposes it via pgwire's SASL support, auth.rs:464-596).
  *
  * Pure crypto over the JDK (PBKDF2WithHmacSHA256 + HmacSHA256): no
  * dependencies. One instance per connection attempt.
  */
final class Scram(user: String, password: String, serverNonce: String,
    salt: Array[Byte], iterations: Int = 4096) {

  private var clientFirstBare: String = _
  private var serverFirst: String = _
  private var combinedNonce: String = _

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  private def saltedPassword: Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** Handle client-first-message → server-first-message. */
  def serverFirstMessage(clientFirst: String): String = {
    // gs2 header "n,," (or "y,,"); bare part follows
    val bare = clientFirst.split(",", 3) match {
      case Array(_, _, rest) => rest
      case _ => throw PgException("28000", "malformed SCRAM client-first-message")
    }
    clientFirstBare = bare
    val clientNonce = bare.split(",").collectFirst {
      case f if f.startsWith("r=") => f.substring(2)
    }.getOrElse(throw PgException("28000", "missing client nonce"))
    combinedNonce = clientNonce + serverNonce
    serverFirst =
      s"r=$combinedNonce,s=${Base64.getEncoder.encodeToString(salt)},i=$iterations"
    serverFirst
  }

  /** Verify client-final-message; Some(serverFinal) on success. */
  def verifyClientFinal(clientFinal: String): Option[String] = {
    val parts = clientFinal.split(",")
    val proofB64 = parts.collectFirst {
      case f if f.startsWith("p=") => f.substring(2)
    }.getOrElse(throw PgException("28000", "missing SCRAM proof"))
    val nonce = parts.collectFirst {
      case f if f.startsWith("r=") => f.substring(2)
    }.getOrElse("")
    if (nonce != combinedNonce) return None
    val withoutProof = clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
    val authMessage =
      (clientFirstBare + "," + serverFirst + "," + withoutProof).getBytes(UTF_8)

    val sp = saltedPassword
    val clientKey = hmac(sp, "Client Key".getBytes(UTF_8))
    val storedKey = sha256(clientKey)
    val clientSignature = hmac(storedKey, authMessage)
    val proof = Base64.getDecoder.decode(proofB64)
    if (proof.length != clientSignature.length) return None
    // recovered ClientKey = proof XOR signature; valid iff its hash is StoredKey
    val recovered = proof.zip(clientSignature).map { case (a, b) => (a ^ b).toByte }
    if (!MessageDigest.isEqual(sha256(recovered), storedKey)) return None

    val serverKey = hmac(sp, "Server Key".getBytes(UTF_8))
    val serverSignature = hmac(serverKey, authMessage)
    Some("v=" + Base64.getEncoder.encodeToString(serverSignature))
  }
}
