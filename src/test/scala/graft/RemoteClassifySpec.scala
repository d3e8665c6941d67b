package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.operators.{CacheJoinClassifier, OpenAiChatTransport, RemoteBatchClassifier}

/** The API-mode classifier exercised END-TO-END against a live (loopback)
  * socket: a JDK HttpServer speaks the chat-completions wire format, and
  * the full cache-join → distinct-keys → mapPartitions(HTTP) → union
  * dataflow runs against it — including a 429-then-success retry, a
  * terminal-failure degrade, request truncation at 600 chars, and the
  * cache short-circuit (cached keys must never reach the socket). */
class RemoteClassifySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  /** Canned chat-completions response whose content is the JSON payload
    * the reference parses (survey_analysis.py:203-207). Sentiment is
    * served lowercase to exercise the classifier's normalization. */
  private def completion(sentiment: String, category: String): Array[Byte] = {
    val content = mapper.writeValueAsString(
      mapper.createObjectNode().put("sentiment", sentiment).put("category", category))
    val root = mapper.createObjectNode()
    root.putArray("choices").addObject().putObject("message").put("content", content)
    mapper.writeValueAsBytes(root)
  }

  test("cache-join → mapPartitions(HTTP) → union path over a live loopback socket") {
    val attempts = new ConcurrentHashMap[String, AtomicInteger]()
    val seenAnswerLen = new ConcurrentHashMap[String, Integer]()
    val seenAuth = new ConcurrentHashMap[String, Boolean]()
    val AnswerRe = "(?s).*\\nAnswer: (.*)\\nSentiment must.*".r

    val handler = new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val req = mapper.readTree(body)
        assert(req.path("model").asText() == "gpt-4o-mini")
        assert(req.path("response_format").path("type").asText() == "json_object")
        val userContent = req.path("messages").path(1).path("content").asText()
        val AnswerRe(answer) = userContent
        val key =
          if (answer.startsWith("flaky answer")) "flaky"
          else if (answer.startsWith("always down")) "down"
          else if (answer.startsWith("good stuff")) "good"
          else "long"
        seenAnswerLen.put(key, answer.length)
        seenAuth.put(key,
          ex.getRequestHeaders.getFirst("Authorization") == "Bearer test-key")
        val n = attempts.computeIfAbsent(key, _ => new AtomicInteger()).incrementAndGet()
        def ok(bytes: Array[Byte]): Unit = {
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          val os = ex.getResponseBody
          try os.write(bytes) finally os.close()
        }
        key match {
          case "flaky" if n == 1 => ex.sendResponseHeaders(429, -1)
          case "flaky"           => ok(completion("negative", "Shipping"))
          case "down"            => ex.sendResponseHeaders(500, -1)
          case "good"            => ok(completion("positive", "Praise"))
          case _                 => ok(completion("neutral", "Long Text"))
        }
        ex.close()
      }
    }

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/chat/completions", handler)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions"
      val cache = Seq(("Apparel", "Q1", "cached answer", "Mixed", "FromCache"))
        .toDF("industry", "question", "answer", "sentiment", "category")
      val clf = new CacheJoinClassifier(cache,
        new RemoteBatchClassifier(OpenAiChatTransport(url, "test-key"),
          sleeper = _ => ())) // no real backoff sleeps in-test
      val longAnswer = "x" * 700
      val keys = Seq(
        ("Apparel", "Q1", "cached answer"),
        ("Apparel", "Q1", "flaky answer please retry"),
        ("Apparel", "Q2", "good stuff"),
        ("Apparel", "Q2", "always down service"),
        ("Apparel", "Q3", longAnswer),
      ).toDF("industry", "question", "answer")

      val got = clf.classify(keys).collect()
        .map(r => r.getString(2) -> (r.getString(3), r.getString(4))).toMap

      assert(got("cached answer") == ("Mixed", "FromCache"))
      // a cached answer reaching the socket would route to "long" (no other
      // prefix matches) and bump its count past 1
      assert(attempts.size() == 4 && attempts.get("long").get() == 1,
        "only the four uncached keys may reach the socket, each once")
      assert(got("flaky answer please retry") == ("Negative", "Shipping"))
      assert(attempts.get("flaky").get() == 2, "429 then success = exactly 2 requests")
      assert(got("good stuff") == ("Positive", "Praise"))
      assert(got("always down service") == ("Neutral", "No Feedback"),
        "terminal failure must degrade, not throw")
      assert(attempts.get("down").get() == 5, "5 attempts before degrading")
      // truncation: the key keeps all 700 chars, the wire sees 600
      assert(got(longAnswer) == ("Neutral", "Long Text"))
      assert(seenAnswerLen.get("long") == 600)
      assert(seenAuth.values().stream().allMatch(b => b), "Bearer header on every request")
    } finally server.stop(0)
  }
}
