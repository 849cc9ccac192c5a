package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Drives the HTTP serving surface end-to-end against sf0.001: the
  * reference's endpoint semantics (main.py:177-391) as observable
  * behavior — availability probes, the hybrid /train parameter input,
  * the validate/test artifact gate ("run train first" as a soft answer,
  * never a crash), and /automate's sequential soft-failure chain. */
class ServeSpec extends SparkSpecBase {

  private lazy val client = HttpClient.newHttpClient()

  private def get(base: String, path: String): String =
    client.send(
      HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString()).body()

  private def post(base: String, path: String, body: String = ""): String =
    client.send(
      HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).body()

  test("serving surface: health probes, artifact-gated validate, hybrid " +
    "train params, automate chain with skip_training") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_serve").toString + "/artifacts"
    val paramsFile = java.nio.file.Files
      .createTempDirectory("graft_serve_cfg").toString + "/params.json"
    java.nio.file.Files.writeString(java.nio.file.Path.of(paramsFile),
      """{"MODEL_THRESHOLD": 14, "predictor": "routed"}""")
    val server = Serve.start(spark,
      () => Tables.events(spark, sf0001), outDir, port = 0,
      paramsFile = Some(paramsFile))
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      // root + health: availability flags and a live engine probe
      val root = get(base, "/")
      assert(root.contains("\"train_available\":true"), root)
      assert(root.contains("\"parameters_file\":\"found\""), root)
      val health = get(base, "/health")
      assert(health.contains("\"status\":\"ok\""), health)
      assert(health.contains("\"engine\":\"healthy\""), health)
      assert(health.contains("\"parameters_file_exists\":true"), health)

      // the artifact gate BEFORE any train: a soft error naming the
      // missing artifacts and the remedy — never a crash
      val early = post(base, "/validate")
      assert(early.contains("\"error\""), early)
      assert(early.contains("run train first"), early)

      // hybrid /train: file layer + manual override (reference UPPER
      // alias accepted in the body; manual overrides file)
      val trained = post(base,
        "/train?use_file_params=true&merge_params=true",
        """{"TRAIN_RATIO": "0.7"}""")
      assert(trained.contains("Training is complete"), trained)
      assert(trained.contains("\"modelThreshold\":\"14\""), trained)
      assert(trained.contains("\"trainRatio\":\"0.7\""), trained)
      assert(trained.contains("\"predictor\":\"routed\""), trained)
      // the routed run published both family artifacts
      assert(graft.operators.Sinks.tableExists(spark,
        s"$outDir/predictor_params_rnn"))
      assert(graft.operators.Sinks.tableExists(spark,
        s"$outDir/predictor_params_xgb"))

      // gated stages now pass (same file-layer cfg → same predictor)
      assert(post(base, "/validate").contains("Validation is complete"))
      assert(post(base, "/test").contains("Testing is complete"))

      // automate with skip_training: artifacts exist → train skipped,
      // the other two stages run and succeed
      val auto = post(base, "/automate?skip_training=true")
      assert(auto.contains("Pipeline automation completed"), auto)
      assert(auto.contains("\"train\":{\"status\":\"skipped\""), auto)
      assert(auto.contains("\"validate\":{\"status\":\"success\""), auto)
      assert(auto.contains("\"test\":{\"status\":\"success\""), auto)

      // unknown endpoint and wrong method answer soft errors
      assert(get(base, "/nope").contains("unknown endpoint"))
      assert(get(base, "/trainx").contains("unknown endpoint"))
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(base + "/train")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 405)

      // a bad manual param degrades per the merge contract (falls back
      // through the layers) rather than crashing the endpoint
      val degraded = post(base, "/train?use_file_params=true",
        """{"seqLength": "banana"}""")
      assert(degraded.contains("Training is complete"), degraded)

      // worker threads are daemons: HttpServer.stop() never shuts down a
      // user-supplied executor, so non-daemon workers would pin the JVM
      // after the documented stop(0) path (round 15)
      val workers = Thread.getAllStackTraces.keySet.toArray(Array.empty[Thread])
        .filter(_.getName == "graft-serve")
      assert(workers.nonEmpty)
      assert(workers.forall(_.isDaemon))
    } finally server.stop(0)
  }

  test("stage endpoints grade the predictor the caller trained (hybrid " +
    "params on /validate and /test), and /automate's skip gate is " +
    "Pipeline.requiredArtifacts — base artifacts included") {
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_serve2").toString + "/artifacts"
    val paramsFile = java.nio.file.Files
      .createTempDirectory("graft_serve2_cfg").toString + "/params.json"
    // the FILE says routed; the caller trains ar2 manually — the round-15
    // hazard was /validate rebuilding cfg from the file alone and grading
    // (or gating) a different predictor than the one just trained
    java.nio.file.Files.writeString(java.nio.file.Path.of(paramsFile),
      """{"predictor": "routed"}""")
    val server = Serve.start(spark,
      () => Tables.events(spark, sf0001), outDir, port = 0,
      paramsFile = Some(paramsFile))
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val trained = post(base, "/train?use_file_params=false",
        """{"predictor": "ar2"}""")
      assert(trained.contains("Training is complete"), trained)

      // same body on /validate → the ar2 gate (predictor_params) passes;
      // the pre-fix code used the file layer (routed) and answered
      // "missing artifacts predictor_params_rnn ... run train first"
      val v = post(base, "/validate?use_file_params=false",
        """{"predictor": "ar2"}""")
      assert(v.contains("Validation is complete"), v)
      val t = post(base, "/test?use_file_params=false",
        """{"predictor": "ar2"}""")
      assert(t.contains("Testing is complete"), t)
      // and the file layer still governs when the caller sends no body:
      // routed's family artifacts were never trained here, so the gate
      // answers soft with the remedy
      val fileV = post(base, "/validate")
      assert(fileV.contains("predictor_params_rnn"), fileV)
      assert(fileV.contains("run train first"), fileV)

      // /automate skip gate: delete a BASE artifact (splits) — predictor
      // params still exist, so the pre-fix Serve gate (which omitted the
      // base artifacts for non-naive predictors) would skip training and
      // then fail validate; the unified gate retrains instead
      def rmrf(p: java.io.File): Unit = {
        Option(p.listFiles()).foreach(_.foreach(rmrf)); p.delete(); ()
      }
      rmrf(new java.io.File(s"$outDir/splits"))
      val auto = post(base,
        "/automate?skip_training=true&use_file_params=false",
        """{"predictor": "ar2"}""")
      assert(auto.contains("\"train\":{\"status\":\"success\""), auto)
      assert(auto.contains("\"validate\":{\"status\":\"success\""), auto)
      assert(auto.contains("\"test\":{\"status\":\"success\""), auto)
    } finally server.stop(0)
  }
}
