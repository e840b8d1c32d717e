package graft.sources

import java.io.FileInputStream
import java.nio.file.{Files, Path}
import java.security.KeyStore

import javax.net.ssl.KeyManagerFactory

import io.netty.handler.ssl.{ApplicationProtocolConfig, ApplicationProtocolNames, SslContext, SslContextBuilder}
import io.netty.handler.ssl.ApplicationProtocolConfig.{Protocol, SelectedListenerFailureBehavior, SelectorFailureBehavior}

/** Test-only TLS material: a fresh self-signed cert per suite run,
  * generated with the JDK's own `keytool` (no BouncyCastle in this
  * environment), exported as PEM for the client's `trustcert` path, and a
  * server SslContext with ALPN h2 — the mirror of the client's config. */
object TestTls {
  private val storePass = "changeit"

  /** @return (server SslContext with ALPN h2, PEM cert path for the
    *          client trust store) */
  def serverContextAndCert(): (SslContext, String) = {
    val dir: Path = Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("server.p12").toString
    val pem = dir.resolve("server.pem").toString
    run("keytool", "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "1", "-keystore", ks,
      "-storetype", "PKCS12", "-storepass", storePass,
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1")
    run("keytool", "-exportcert", "-rfc", "-alias", "srv", "-keystore", ks,
      "-storepass", storePass, "-file", pem)
    val store = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(ks)
    try store.load(in, storePass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, storePass.toCharArray)
    val ctx = SslContextBuilder.forServer(kmf)
      .applicationProtocolConfig(new ApplicationProtocolConfig(
        Protocol.ALPN,
        SelectorFailureBehavior.NO_ADVERTISE,
        SelectedListenerFailureBehavior.ACCEPT,
        ApplicationProtocolNames.HTTP_2))
      .build()
    (ctx, pem)
  }

  private def run(cmd: String*): Unit = {
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    require(rc == 0, s"${cmd.head} failed (rc=$rc): $out")
  }
}
