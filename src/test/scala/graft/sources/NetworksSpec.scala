package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Endpoint resolution parity (run.go:73-92): precedence, registry
  * lookup, env override, and the refuse-to-guess error. */
class NetworksSpec extends AnyFunSuite {

  private val noEnv: String => Option[String] = _ => None

  test("explicit endpoint always wins") {
    assert(Networks.resolve(Some("h:1"), Some("mainnet"), Some("polygon"),
      noEnv) == "h:1")
  }

  test("network flag resolves through the table, beats manifest network") {
    assert(Networks.resolve(None, Some("polygon"), Some("mainnet"), noEnv)
      == "polygon.streamingfast.io:443")
  }

  test("manifest-declared network is the fallback chain name") {
    assert(Networks.resolve(None, None, Some("mainnet"), noEnv)
      == "mainnet.eth.streamingfast.io:443")
  }

  test("env override beats the built-in table and rescues unknown names") {
    val env: String => Option[String] = {
      case "SUBSTREAMS_ENDPOINTS_CONFIG_MAINNET" => Some("edge:9000")
      case "SUBSTREAMS_ENDPOINTS_CONFIG_MY_L2" => Some("l2:443")
      case _ => None
    }
    assert(Networks.resolve(None, Some("mainnet"), None, env) == "edge:9000")
    assert(Networks.resolve(None, Some("my-l2"), None, env) == "l2:443")
  }

  test("unknown network errors with both escape hatches, never defaults") {
    val e = intercept[IllegalArgumentException](
      Networks.resolve(None, Some("no-such-chain"), None, noEnv))
    assert(e.getMessage.contains("no-such-chain"))
    assert(e.getMessage.contains("SUBSTREAMS_ENDPOINTS_CONFIG_NO_SUCH_CHAIN"))
  }

  test("nothing named at all is an error (no silent default chain)") {
    val e = intercept[IllegalArgumentException](
      Networks.resolve(None, None, None, noEnv))
    assert(e.getMessage.contains("no endpoint"))
  }

  test("gRPC factory surfaces the same resolution for its option map") {
    // unknown network propagates the registry error through the factory
    val e = intercept[IllegalArgumentException](
      new GrpcBlockClientFactory().create(Map("network" -> "no-such-chain")))
    assert(e.getMessage.contains("no-such-chain"))
  }
}
