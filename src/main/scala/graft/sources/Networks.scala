package graft.sources

/** Named-network → endpoint registry — the Spark restatement of the
  * reference's endpoint resolution (run.go:73-92, which defers to the
  * substreams CLI's `manifest.ExtractNetworkEndpoint`).
  *
  * Resolution precedence, exactly the reference's:
  *   1. an explicit endpoint always wins;
  *   2. else the `--network` flag names the chain;
  *   3. else the manifest's declared network (a substreams .spkg carries
  *      a `network` field) stands in;
  * then the chosen name maps to an endpoint via, in order:
  *   a. the `SUBSTREAMS_ENDPOINTS_CONFIG_<NETWORK>` environment variable
  *      (the substreams CLI's per-network override convention);
  *   b. the built-in table below (the publicly documented
  *      `<network>.streamingfast.io:443` convention).
  * An unknown name is an error listing both escape hatches — never a
  * silent default, since a sinker pointed at the wrong chain writes
  * plausible-looking garbage.
  */
object Networks {

  /** Publicly documented endpoints for common networks; any network not
    * listed here resolves via the env-var override. */
  val Table: Map[String, String] = Map(
    "mainnet" -> "mainnet.eth.streamingfast.io:443",
    "sepolia" -> "sepolia.eth.streamingfast.io:443",
    "holesky" -> "holesky.eth.streamingfast.io:443",
    "polygon" -> "polygon.streamingfast.io:443",
    "bsc" -> "bnb.streamingfast.io:443",
    "arbitrum" -> "arb-one.streamingfast.io:443",
    "optimism" -> "opt-mainnet.streamingfast.io:443",
    "base" -> "base-mainnet.streamingfast.io:443",
    "solana" -> "mainnet.sol.streamingfast.io:443",
    "near" -> "mainnet.near.streamingfast.io:443",
    "injective" -> "mainnet.injective.streamingfast.io:443")

  /** Env-var key for a network name, substreams CLI convention:
    * upper-cased, non-alphanumerics collapsed to `_`. */
  def envKey(network: String): String =
    "SUBSTREAMS_ENDPOINTS_CONFIG_" +
      network.toUpperCase.replaceAll("[^A-Z0-9]", "_")

  /** Resolve to `host:port`. `env` is injectable for tests; production
    * callers use the default `sys.env.get`. */
  def resolve(
      endpoint: Option[String],
      network: Option[String],
      manifestNetwork: Option[String] = None,
      env: String => Option[String] = sys.env.get): String = {
    endpoint.filter(_.nonEmpty).getOrElse {
      val name = network.filter(_.nonEmpty)
        .orElse(manifestNetwork.filter(_.nonEmpty))
        .getOrElse(throw new IllegalArgumentException(
          "no endpoint: pass an explicit endpoint, a network name, or a " +
            "manifest that declares one"))
      env(envKey(name)).filter(_.nonEmpty)
        .orElse(Table.get(name.toLowerCase))
        .getOrElse(throw new IllegalArgumentException(
          s"unknown network '$name': known ${Table.keys.toSeq.sorted.mkString(", ")}; " +
            s"or set ${envKey(name)}=host:port"))
    }
  }
}
